from genie2_tpu.geometry.rigid import Rigid, rot_matmul, rot_vec_mul
from genie2_tpu.geometry.quat import quat_to_rot, rot_to_quat
from genie2_tpu.geometry.frames import (
    frenet_frames,
    pairwise_distance,
    distogram,
)
from genie2_tpu.geometry.encoding import sinusoidal_encoding

__all__ = [
    "Rigid",
    "rot_matmul",
    "rot_vec_mul",
    "quat_to_rot",
    "rot_to_quat",
    "frenet_frames",
    "pairwise_distance",
    "distogram",
    "sinusoidal_encoding",
]
