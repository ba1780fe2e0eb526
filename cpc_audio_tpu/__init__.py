"""cpc_audio_tpu — a TPU-native (JAX/XLA/Pallas) CPC-on-audio framework.

A from-scratch rebuild of the capabilities of facebookresearch/CPC_audio
(reference mounted at /root/reference) designed for TPU: channels-last
activations, scan-based recurrences with fused gate matmuls, vmapped
prediction heads, shard_map data parallelism over a device mesh, and native
C++ host kernels for audio decode, DTW and CTC beam search.
"""

__version__ = "0.1.0"

from .config import CPCConfig, TrainConfig, get_default_cpc_config
