"""Sources & sinks: corpus reader/synthesizer, query-file reader, TREC run
writer/reader, param-file reader (SURVEY.md §2.1)."""
