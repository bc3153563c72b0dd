"""Sources: the synthetic Common-Crawl-style corpus generator.

In the graft sandbox the corpus *is* the web: fetching a URL is an equi-join
of the frontier wave against the ``pages`` table (SURVEY.md §2.1 S2). The
fixture generator below materializes a deterministic small web with every
structure the reference crawl reacts to (FIXTURES.md §1-§3).
"""
