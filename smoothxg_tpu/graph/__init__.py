from .mutable import MutableGraph
from .index import FlatIndex
