from .config import Dict, EasyDict, construct_class_by_name
