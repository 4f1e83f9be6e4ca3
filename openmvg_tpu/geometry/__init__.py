from openmvg_tpu.geometry.pose import Pose, pose_from_Rt, relative_pose
from openmvg_tpu.geometry.similarity import Similarity, find_rts
from openmvg_tpu.geometry import so3
from openmvg_tpu.geometry import convex_hull
from openmvg_tpu.geometry import plane
