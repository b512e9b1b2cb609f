"""Stage orchestration: checkpoint store, lineage, the end-to-end
dedup pipeline."""
