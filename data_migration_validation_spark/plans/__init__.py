"""Plans: the physical side of the engine — snapshot lake table, MERGE
upsert, checkpoint/lineage, and the epoch replay apply loop."""
