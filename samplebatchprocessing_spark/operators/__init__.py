"""Reusable composite operators built from stock DataFrame primitives.

These are the engine's "custom operators" — semantics Spark lacks a
single built-in for, each expressed as a composition that Catalyst
can still optimize (SURVEY §4B: no custom rules needed).
"""
