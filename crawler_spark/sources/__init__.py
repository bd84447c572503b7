"""Sources and sinks: snapshot-versioned table store + synthetic corpus."""
