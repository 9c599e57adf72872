"""Sources: deterministic synthetic changelog (binlog/WAL) generation and readers."""
