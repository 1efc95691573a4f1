"""Reference-equivalent composite jobs (SURVEY §3 lifecycles) built from the
operator library: web-log metrics, schema consolidation, rollup pyramid.
"""
