from . import (  # noqa: F401
    compile_results,
    maze,
    obstacle_field,
    pendulum,
    planning,
    robot_planning,
    verify_trajectory,
)
