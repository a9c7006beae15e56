"""Mesh/sharding layer: shard_map'd attention, cross-shard softmax, ring attention."""
