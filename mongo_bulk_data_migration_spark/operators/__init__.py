from .merge import MergePlan, build_merge_plan, run_merge
from .dedup import last_wins

__all__ = ["MergePlan", "build_merge_plan", "run_merge", "last_wins"]
