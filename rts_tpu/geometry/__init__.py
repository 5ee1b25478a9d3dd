from rts_tpu.geometry.mesh import Mesh
from rts_tpu.geometry.rect import rect_mesh
from rts_tpu.geometry.sphere import sphere_mesh
from rts_tpu.geometry.filemesh import file_mesh, write_mesh_files
from rts_tpu.geometry.terrain import fractal_heights, terrain_mesh

__all__ = [
    "Mesh",
    "fractal_heights",
    "file_mesh",
    "rect_mesh",
    "sphere_mesh",
    "terrain_mesh",
    "write_mesh_files",
]
