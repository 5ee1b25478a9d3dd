from rts_tpu.geometry.mesh import Mesh
from rts_tpu.geometry.rect import rect_mesh
from rts_tpu.geometry.sphere import sphere_mesh
from rts_tpu.geometry.filemesh import file_mesh, write_mesh_files

__all__ = ["Mesh", "rect_mesh", "sphere_mesh", "file_mesh", "write_mesh_files"]
