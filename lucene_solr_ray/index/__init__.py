from . import codec, smallfloat
from .build import build_index
from .compact import compact_index
from .manifest import Manifest

__all__ = ["codec", "smallfloat", "build_index", "compact_index", "Manifest"]
