from seamless_communication_tpu.segment.vad import VADSegmenter  # noqa: F401
