"""Logical plan compositions: flagship pipeline, serving views, BI pack."""
