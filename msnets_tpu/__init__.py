"""msnets_tpu: a TPU-native stereo-depth framework.

A from-scratch JAX/XLA/Pallas re-design of the MS-Nets matching-space stereo
pipeline (reference: ccj5351/MS-Nets, "Matching-space Stereo Networks for
Cross-domain Generalization", 3DV 2020). The matching-cost feature stage runs
as device kernels, the 3-D cost-volume regularizers are Flax modules, and
scale-out uses a (data, spatial, disp) device mesh with XLA collectives.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    Config,
    DataConfig,
    EvalConfig,
    INVALID,
    MatchingConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
