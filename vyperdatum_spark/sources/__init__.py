"""Sources: table formats and readers."""
