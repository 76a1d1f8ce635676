"""Checkpoint manifests, per-partition lineage records, resumable runs."""
