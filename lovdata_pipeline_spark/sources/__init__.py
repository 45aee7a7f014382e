"""Sources and sinks: XML corpus reader, state table, chunk store, JSONL."""
