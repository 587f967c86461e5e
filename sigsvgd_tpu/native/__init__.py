from .collision import MeshCollisionEngine, TriMesh, build_native_library  # noqa: F401
