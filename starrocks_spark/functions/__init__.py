"""Scalar/array function library: text processing, sketches, vector
math — the pieces Spark lacks from the reference's function registry
(gensrc/script/functions.py) plus the LLM-data-pipeline primitives.
"""
