"""Scalar function surface: faker generators, encoding, regex helpers.

Mirrors the reference's Tera custom functions/filters
(src/updater/tera_helpers/, src/updater/tera.rs:22-86) with native
Column implementations.
"""
