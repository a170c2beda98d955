from .mesh import get_mesh, device_count
