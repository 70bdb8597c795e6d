"""SQL-dialect translation and plan-level utilities.

The reference's FE owns parsing/analysis of its MySQL-flavored dialect
(fe/fe-grammar/.../StarRocks.g4); on Spark the parser is Catalyst's, so
dialect gaps are closed by a source-to-source translation layer
(SURVEY.md §4.1 [S] items): MySQL date-format strings, function
aliases, QUALIFY desugaring, INTERVAL arithmetic.
"""
