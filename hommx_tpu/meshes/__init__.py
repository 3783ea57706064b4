from hommx_tpu.meshes.simplex import (
    SimplexMesh,
    create_box,
    create_interval,
    create_rectangle,
    create_unit_cube,
    create_unit_square,
    mesh_from_delaunay,
    mesh_from_file,
    rescale_mesh,
    rescale_mesh_in_place,
)

__all__ = [
    "SimplexMesh",
    "create_box",
    "create_interval",
    "create_rectangle",
    "create_unit_cube",
    "create_unit_square",
    "mesh_from_delaunay",
    "mesh_from_file",
    "rescale_mesh",
    "rescale_mesh_in_place",
]
