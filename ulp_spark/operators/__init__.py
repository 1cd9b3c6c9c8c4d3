"""Pipeline operators: parse -> enrich -> route -> cast -> aggregate -> fan-out,
plus lineage.  Each module maps to SURVEY.md §2 rows (P1-P11, J1-J3, A1-A6,
D1) and cites the reference behavior it re-expresses.
"""
