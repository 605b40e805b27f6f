-- global after-script: whole-project summary, not attached to a model
SELECT count(*) AS n_models_rows FROM {{ ref('stg_orders') }}
