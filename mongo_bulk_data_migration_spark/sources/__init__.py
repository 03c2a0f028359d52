from .laketable import LakeTable
from .catalog import Catalog

__all__ = ["LakeTable", "Catalog"]
