"""Sources & sinks: schema'd readers, partitioned-lake writer, snapshot
materialization (SURVEY.md §2.1)."""
