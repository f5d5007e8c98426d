"""MLlib pipelines: the reference's pattern-replay prediction upgraded
to a trained model over the same features (SURVEY.md §7 phase 4)."""
