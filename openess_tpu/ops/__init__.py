from openess_tpu.ops.voxelize import (
    event_histogram,
    normalize_nonzero,
    voxel_grid_bilinear_t,
    voxel_grid_trilinear,
    voxelize_windows_trilinear,
)
from openess_tpu.ops.voxelize_mxu import (
    voxelize_windows_bilinear_t_mxu,
    voxelize_windows_trilinear_mxu,
)

__all__ = [
    "event_histogram",
    "normalize_nonzero",
    "voxel_grid_bilinear_t",
    "voxel_grid_trilinear",
    "voxelize_windows_trilinear",
    "voxelize_windows_bilinear_t_mxu",
    "voxelize_windows_trilinear_mxu",
]
