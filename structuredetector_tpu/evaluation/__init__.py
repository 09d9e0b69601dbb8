from .evaluator import Evaluation, Evaluations, Evaluator  # noqa: F401
