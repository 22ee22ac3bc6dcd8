"""Engine operators.

Thin, typed, Spark-first realizations of the reference's operator
inventory (SURVEY.md §2) plus the training-data-pipeline extensions.
Every operator is a DataFrame→DataFrame transformation; none collects
to the driver (SURVEY.md §7 hard-part 7).
"""
