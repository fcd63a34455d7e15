"""Operator inventory (SURVEY.md §2), one module per family.

Every operator is a pure function DataFrame(s) → DataFrame, generic
over column names, declarative (Catalyst-optimizable), and
shuffle-conscious: aggregations are single-pass hash aggs (partial +
final), dimension joins are broadcast, and nothing collects to the
driver except the explicitly-marked ``driver_compute`` graph steps.
"""
