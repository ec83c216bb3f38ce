"""On-disk index state: layout, shard writer/reader, manifests, stats."""
