"""Engine operators.

Each module re-expresses one family of reference operators (SURVEY.md §2)
as composable DataFrame→DataFrame functions, batch and streaming alike.
"""
