"""Host-side utilities: artifact store, config parsing, IPC, decorators."""
