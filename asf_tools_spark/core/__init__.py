"""Pure numpy/python core — no Spark imports.

The golden-contract math lives here (cell index, tile keys, EM threshold,
fuzzy memberships, flood estimators, connected-component labeling) so that
pandas UDFs and unit tests share one bit-exact implementation.
"""
