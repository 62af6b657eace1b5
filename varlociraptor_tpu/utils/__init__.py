from . import logprob  # noqa: F401
