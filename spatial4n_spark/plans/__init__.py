from spatial4n_spark.plans.cover import cover_cells, choose_level
