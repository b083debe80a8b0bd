"""placeholder — filled in by subsequent milestones."""


def queries():
    return {}


def oracles():
    return {}
