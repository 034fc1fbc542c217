from .coarse import bearing_histogram, coarse_align_2d, coarse_align_3d
from .filters import remove_statistical_outliers
from .nn import masked_min_with_index, nearest_neighbors, pairwise_sq_dists
from .rigid_fit import (
    cross_covariance,
    fit_rigid,
    fit_rigid_indexed,
    rotation_from_covariance_2d,
    rotation_from_covariance_3d_quat,
    rotation_from_covariance_3d_svd,
)

__all__ = [
    "bearing_histogram",
    "coarse_align_2d",
    "coarse_align_3d",
    "fit_rigid_indexed",
    "remove_statistical_outliers",
    "nearest_neighbors",
    "pairwise_sq_dists",
    "masked_min_with_index",
    "fit_rigid",
    "cross_covariance",
    "rotation_from_covariance_2d",
    "rotation_from_covariance_3d_svd",
    "rotation_from_covariance_3d_quat",
]
