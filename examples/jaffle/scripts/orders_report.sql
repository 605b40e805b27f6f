-- after-script: a standalone report over the freshly built model
-- (the SQL analogue of the reference's attached .py reporting scripts)
SELECT count(*) AS n_customers,
       sum(number_of_orders) AS n_orders
FROM {{ ref('customer_orders') }}
