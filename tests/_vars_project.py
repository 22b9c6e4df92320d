"""Helper project for the CLI --vars precedence test: configure() sets a
project-level variable default, which dbt semantics say CLI --vars must
override."""


def configure(eng):
    eng.registry.variables["cutoff"] = 5  # project default
    eng.registry.register(
        "vars_model",
        "SELECT order_id FROM {{ ref('olist_orders_dataset') }} "
        "LIMIT {{ var('cutoff') }}",
    )
