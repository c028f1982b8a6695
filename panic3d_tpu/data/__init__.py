from .databack import DatabackendMinna
from .dataset import (
    EcrutileEDataset,
    InfiniteBatcher,
    assemble_sample,
    collate,
    mirror_camera_label,
    synthetic_batch,
)
