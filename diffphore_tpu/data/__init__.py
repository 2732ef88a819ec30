"""Host-side data layer: .phore parsing, graph construction, padding/bucketing,
dataset caching and the training-time noise transform."""
