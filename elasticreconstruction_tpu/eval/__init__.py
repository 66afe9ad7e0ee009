from . import ate, gt_benchmark, registration_pr

__all__ = ["ate", "gt_benchmark", "registration_pr"]
