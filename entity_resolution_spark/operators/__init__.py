"""Relational + ER + training-data-pipeline operators."""
