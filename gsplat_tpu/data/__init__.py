"""Data / IO layer (SURVEY.md L1): datasets, point clouds, COLMAP, prep.

Everything here is host-side numpy (device-agnostic); arrays cross onto the
TPU only when the trainer/pool consumes them. Reference counterparts:
/root/reference/gaussian_splatting/data_loader.py, datasets/*.py.
"""

from .dataset import GaussianDataset, load_camera_parameters  # noqa: F401
from .pointcloud import load_point_cloud, read_ply, write_ply  # noqa: F401
from .images import load_image  # noqa: F401
