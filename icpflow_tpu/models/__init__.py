from .icp_flow import SceneFlowEngine  # noqa: F401
from .streaming import StreamingEngine  # noqa: F401
