SELECT CAST(event_type AS VARCHAR) AS event_type, CAST(n_days AS BIGINT) AS n_days, CAST(n_events AS BIGINT) AS n_events, CAST(approx_users_merged AS BIGINT) AS approx_users_merged FROM (VALUES
  ('click', 30, 210, 15),
  ('error', 30, 201, 15),
  ('purchase', 30, 202, 15),
  ('signup', 30, 199, 15),
  ('view', 30, 188, 15)
) AS golden(event_type, n_days, n_events, approx_users_merged)
