from .inspect import executed_plan, plan_report

__all__ = ["executed_plan", "plan_report"]
