"""Large-scale training-data operators (beyond-reference extensions,
SURVEY §7.8): dedup families, similarity search, text analysis,
multimodal column plumbing.  All hot paths are native Column
expressions or Arrow-batched Pandas UDFs — no row-at-a-time Python."""
