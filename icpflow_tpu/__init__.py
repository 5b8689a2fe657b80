"""icpflow_tpu: a TPU-native LiDAR scene-flow framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ICP-Flow
(yanconglin/ICP-Flow, CVPR 2024): learning-free scene flow via ground
segmentation, density clustering, histogram-initialised batched ICP over
cluster pairs, and rigid per-cluster flow assembly — built around masked
fixed-shape segment batches and compiled end-to-end with XLA.
"""

from .config import PipelineConfig, PRESETS, WAYMO, NUSCENES, ARGO, DEMO
from .models.icp_flow import SceneFlowEngine
from .models.streaming import StreamingEngine

__version__ = "0.1.0"
__all__ = ["PipelineConfig", "PRESETS", "WAYMO", "NUSCENES", "ARGO", "DEMO",
           "SceneFlowEngine", "StreamingEngine"]
