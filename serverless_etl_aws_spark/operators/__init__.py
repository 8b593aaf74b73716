"""Custom operators Spark lacks natively, composed from DataFrame ops.

Per SURVEY.md §4, none of these need a Catalyst rule — each is a
composition of built-in operators chosen so the optimizer can still push
filters and pick physical join strategies.
"""
