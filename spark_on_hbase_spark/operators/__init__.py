"""Operator library re-expressing the reference's capability surface
(SURVEY.md §2) plus large-scale training-data-pipeline operators."""
