"""Query library: SURVEY.md §2 operator inventory over the driver testdata."""
