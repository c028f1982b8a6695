from .conventions import (
    cam60,
    camsubs,
    euler_xyz_matrix,
    fov_to_focal,
    camera_label,
    get_rays_ortho,
    create_cam2world_matrix,
    lookat_pose,
)
from .rays import sample_rays
