"""Multi-chip parallelism (mesh + shard_map matchers)."""
