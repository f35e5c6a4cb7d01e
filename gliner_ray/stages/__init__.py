"""Ray Data pipeline stages (SURVEY.md §7.0 [A]–[E]).

Each stage is either a stateless ``map_batches`` function (Arrow in /
Arrow out) or a callable class run as an actor pool. None of these
modules call ``ray.init``.
"""
