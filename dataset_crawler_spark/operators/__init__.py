"""Engine operators (SURVEY.md §2): diff/change-capture, state folds,
seen-set membership, politeness scheduling, dedup, similarity."""
