from alignq_tpu.data.loader import Data, ArrayLoader
from alignq_tpu.data.registry import get_data

__all__ = ["Data", "ArrayLoader", "get_data"]
