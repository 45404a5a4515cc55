"""Data layer: COLMAP / Blender readers, PLY I/O, image + resolution policy."""
