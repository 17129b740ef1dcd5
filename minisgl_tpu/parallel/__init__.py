from minisgl_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, MeshInfo, create_mesh

__all__ = ["DATA_AXIS", "MODEL_AXIS", "MeshInfo", "create_mesh"]
