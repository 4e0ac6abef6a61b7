"""Torch-CPU oracle implementations of the reference's op layer.

Written from the SURVEY.md §2 behavioral specs (the reference mount was
empty — see SURVEY.md §0); these give an independent, framework-external
ground truth for the JAX ops and models. NOT part of the shipped framework.
"""
