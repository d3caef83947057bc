from super_tpu.geometry.quaternion import (  # noqa: F401
    skew,
    quat_rotate,
    transform_quat_t,
    transform_quat_t_jac,
    blend_warp,
    blend_warp_jac,
    quat_to_matrix,
    matrix_to_quat,
    merge_transformation,
    IDENTITY_DQ,
)
from super_tpu.geometry.camera import (  # noqa: F401
    Intrinsics,
    project_points,
    backproject_depth,
    pixel_grid,
)
from super_tpu.geometry.divergence import kld, jsd  # noqa: F401
