from .triplane import TriPlaneGenerator, OSGDecoder, DEFAULT_RENDERING_KWARGS
from .stylegan2 import (
    FullyConnectedLayer,
    Conv2dLayer,
    MappingNetwork,
    SynthesisLayer,
    ToRGBLayer,
    SynthesisBlock,
    SynthesisNetwork,
    Generator,
    Discriminator,
)
from .superresolution import SR_MODULES
