"""Relational operator coverage: Ray Data implementations of the
engine's generic query surface (filter / project / aggregate / join /
sort / limit / distinct / window), each with an exact DuckDB oracle.
"""
