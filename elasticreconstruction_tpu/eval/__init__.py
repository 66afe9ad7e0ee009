from . import ate, registration_pr

__all__ = ["ate", "registration_pr"]
