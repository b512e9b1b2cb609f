"""Sources & sinks: schema-pinned readers, export writers."""
