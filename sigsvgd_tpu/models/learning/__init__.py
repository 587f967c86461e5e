from .mlp import ProbMLP, ProbModel, train_prob_model  # noqa: F401
