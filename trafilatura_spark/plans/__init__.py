"""Plan-level composition.

The engine needs no custom Catalyst rules (SURVEY.md §4.2): logical plans
are composed from stock operators.  The compositions live where they run:

- batch extraction plan (read → salt → mapInPandas → metrics → write,
  checkpointed waves): :mod:`trafilatura_spark.job`
- the extraction operator itself: :mod:`trafilatura_spark.operators.pipeline`
- streaming plans: :mod:`trafilatura_spark.streaming`
- corpus-level relational plans (dedup / similarity / stats):
  :mod:`trafilatura_spark.functions`
"""
