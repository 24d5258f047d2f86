"""Pipeline stages: each is a pure function Dataset → Dataset built from
map_batches / groupby / join — the engine's analog of the reference's stage
classes (__init__(config) + execute(), /root/reference/src/pipeline.py:55-62)."""
