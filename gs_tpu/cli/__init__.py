"""Command-line drivers mirroring the reference's train/render/metrics CLIs."""
