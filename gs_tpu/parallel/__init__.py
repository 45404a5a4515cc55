"""Multi-chip parallelism: device mesh, sharded render/train steps."""
