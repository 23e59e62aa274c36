from .cfg_node import CfgNode
from .default import get_default_cfg
from .view import CfgView, as_view

__all__ = ["CfgNode", "get_default_cfg", "CfgView", "as_view"]
