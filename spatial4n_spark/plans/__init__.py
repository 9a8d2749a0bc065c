from spatial4n_spark.plans.cover import cover_cells, choose_level
from spatial4n_spark.plans.pip_planner import PipPlan, plan_pip_join, spatial_join_auto
