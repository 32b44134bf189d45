"""MIMAMO-TPU: a TPU-native (JAX/XLA/Pallas) video valence/arousal emotion
recognition framework with the capabilities of wtomin/MIMAMO-Net.

Micro-motion (steerable-pyramid phase differences) + macro-motion
(ResNet-50 FER+ appearance embeddings) two-stream GRU regression, compiled
to a single XLA program per clip and sharded data-parallel over a device
mesh for pod-slice throughput.
"""

from .config import (
    BackboneSpec,
    ClipSpec,
    DEFAULT_CONFIG,
    MimamoConfig,
    PhaseSpec,
    PyramidSpec,
    TemporalSpec,
    TrainSpec,
)

__version__ = "0.5.0"
