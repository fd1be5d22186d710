from graphx_ray.sources.synth import (  # noqa: F401
    gen_transcript_shard,
    gen_transcripts_local,
    transcripts_dataset,
    write_transcripts,
)
