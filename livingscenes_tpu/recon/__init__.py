from .mesh import Mesh
from .grid import (
    dense_grid_values,
    hierarchical_grid_values,
    sharded_dense_grid_values,
    grid_coordinates,
)
from .extractor import MeshExtractor, MeshExtractorConfig

__all__ = [
    "Mesh",
    "dense_grid_values",
    "hierarchical_grid_values",
    "sharded_dense_grid_values",
    "grid_coordinates",
    "MeshExtractor",
    "MeshExtractorConfig",
]
