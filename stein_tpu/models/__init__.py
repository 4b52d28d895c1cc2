from .distributions import normal_log_prob, gamma_log_prob
from .linear_regression import LinearRegressionModel
from .logistic_regression import LogisticRegressionModel
from .bayesian_nn import BayesianNNModel

__all__ = [
    "normal_log_prob",
    "gamma_log_prob",
    "LinearRegressionModel",
    "LogisticRegressionModel",
    "BayesianNNModel",
]
