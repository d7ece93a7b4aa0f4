"""cuda_gcn_tpu — a TPU-native GCN message-passing framework (JAX/XLA/Pallas).

Brand-new implementation with the capabilities of the reference CUDA framework
(hengdashi/cuda_gcn), redesigned TPU-first. See SURVEY.md for the reference map.
"""

from cuda_gcn_tpu.config import GCNConfig, default_config

__all__ = ["GCNConfig", "default_config"]
__version__ = "0.1.0"
