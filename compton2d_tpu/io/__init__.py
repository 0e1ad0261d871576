"""I/O: event records, output files, checkpointing, legacy configs,
post-processing."""
