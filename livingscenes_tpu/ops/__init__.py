from .knn import knn, pairwise_sqdist, gather_neighbors
from .fps import farthest_point_sampling, fps_subsample_with_features
from .sinkhorn import (
    log_optimal_transport,
    log_sinkhorn_iterations,
    sinkhorn_divergence,
)
from .icp import iterative_closest_point, ICPResult

__all__ = [
    "knn",
    "pairwise_sqdist",
    "gather_neighbors",
    "farthest_point_sampling",
    "fps_subsample_with_features",
    "log_optimal_transport",
    "log_sinkhorn_iterations",
    "sinkhorn_divergence",
    "iterative_closest_point",
    "ICPResult",
]
