SELECT CAST(event_type AS VARCHAR) AS event_type, CAST(n_days AS BIGINT) AS n_days, CAST(n_events AS BIGINT) AS n_events, CAST(approx_users_merged AS BIGINT) AS approx_users_merged FROM (VALUES
  ('click', 30, 2006, 150),
  ('error', 30, 2014, 150),
  ('purchase', 30, 1981, 150),
  ('signup', 30, 2017, 150),
  ('view', 30, 1982, 150)
) AS golden(event_type, n_days, n_events, approx_users_merged)
