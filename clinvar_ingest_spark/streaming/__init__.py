"""Micro-batch apply loop, offsets ledger, lineage metrics."""
